"""Sources: text line-protocol parsers (MQTT payload format) usable on both
batch and streaming DataFrames."""
