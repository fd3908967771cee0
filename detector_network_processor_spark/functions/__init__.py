"""Column-function library: geodesy, time helpers, text analysis."""
