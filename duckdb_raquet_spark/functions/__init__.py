"""Large-scale training-data-pipeline operators over webtext tables:
text analysis (token stats, quality, language id, fingerprints),
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
cosine), and similarity search (brute-force + LSH-bucketed ANN).

All operators are declarative DataFrame plans built from JVM-side
``pyspark.sql.functions`` expressions wherever possible; Python appears
only in Arrow-vectorized pandas UDFs (language id), never per row.
"""

from . import dedup, similarity, text  # noqa: F401
