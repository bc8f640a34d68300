"""ocr_cezam_spark — PySpark-native web-scale main-content extraction engine.

From-scratch reimplementation of the query/data-processing capabilities of
DrArtemi/ocr-cezam (reference at /root/reference, studied — not ported),
generalized to Common-Crawl-style web pages per BASELINE.json.
"""

__version__ = "0.1.0"
