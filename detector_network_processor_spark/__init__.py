"""PySpark-native analytics engine with the query/data-processing
capabilities of MuonPi/detector-network-processor (see SURVEY.md).

Brand-new Spark-first design: DataFrame/SQL declarative plans optimized by
Catalyst, Pandas-UDF-backed operators only where built-ins cannot express the
semantics (coincidence clustering, MinHash dedup), Structured Streaming for
the online mode. Not a port of the reference's C++ thread/queue architecture.
"""

__version__ = "0.1.0"
