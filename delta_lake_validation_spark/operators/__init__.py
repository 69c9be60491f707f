"""Custom operators the engine adds beyond plain Spark SQL:

- ``similarity`` — ANN / all-pairs cosine via block-matrix mapInPandas
- ``dedup``      — MinHash-LSH, SimHash, n-gram Jaccard near-dup detection
- ``text``       — language-ID and other text heuristics
- ``multimodal`` — binary-column (image/audio) plumbing with stubbed codecs
"""
