"""repostcheckerbot_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query semantics of A1igator/RepostCheckerBot (a Reddit repost
detector: incremental near-duplicate detection over an accumulating corpus) as an
idiomatic Spark pipeline:

    blocking (MinHash-LSH + composite keys)  →  pairwise scoring (Arrow-batched
    difflib ratio, reference parity)         →  transitive clustering
    (large-star / small-star connected components)

over a table of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing here is a port: the reference's O(N²) Python row loops
(/root/reference/database.py:389-405) become blocked, vectorized, shuffle-aware
DataFrame plans. See SURVEY.md for the operator-by-operator mapping.
"""

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.pipeline import run_batch

__all__ = ["PipelineConfig", "run_batch"]
__version__ = "0.1.0"
