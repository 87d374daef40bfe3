"""Relational + beyond-reference operators.

- ``detections``: the reference's enrich pipeline (explode -> max -> pivot)
- ``frames``: frame numbering / gap detection / run diffing
- ``dedup``: exact + MinHash-LSH + SimHash + n-gram Jaccard near-dup
- ``similarity``: cosine top-k (brute force + bucket-pruned ANN)
- ``text``: language ID, quality stats, token counting, fingerprinting
- ``images``: binary-column image kit (decode/blur/resize pandas UDFs)
"""
