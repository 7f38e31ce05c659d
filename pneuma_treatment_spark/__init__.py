"""pneuma_treatment_spark — a PySpark-native time-series rollup + downsample +
retention engine.

A from-scratch re-expression of the query/data-processing capabilities of the
``LingmiaoXD/pneuma_treatment`` reference (per-series denoising + per-node
per-second windowed rollups + mask/retention semantics + evaluation metrics),
built Spark-first over a transcripts fact table::

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Design notes
------------
* DataFrame/SQL only — no RDDs. Catalyst handles pushdown/pruning; we handle
  partitioning (days(ts) x bucket(conv_id)), skew (salted two-phase agg), and
  non-associative float kernels (inside per-series Arrow UDFs on sorted data).
* Sized for a 1000-executor cluster over ~10^12 turns; tested on local[32]
  with deterministic small-scale synthetic data.
"""

__version__ = "0.1.0"

from pneuma_treatment_spark.session import get_spark  # noqa: F401
