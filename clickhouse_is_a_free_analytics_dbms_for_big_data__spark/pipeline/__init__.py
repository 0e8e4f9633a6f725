"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): the
operations a 100 TB LLM-data pipeline needs, built Spark-first:

- ``text``       — tokenization, language-ID, quality scoring,
                   fingerprinting (pure Column expressions)
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                   embedding near-dup (banded joins, no O(n^2) pass)
- ``similarity`` — brute-force cosine top-k baseline + LSH/IVF bucketed
                   scale path
- ``multimodal`` — opaque binary media columns with typed metadata;
                   decode/feature plumbing as Arrow-batched mapInPandas
                   (decode itself stubbed: no codec libs in-container)
"""

from . import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
