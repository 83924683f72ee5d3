"""Font subsystem: standard-14 metrics, encodings, ToUnicode CMaps,
simple/CID font width resolution."""
