"""universal_pdf_extractor_spark — a PySpark-native extraction engine.

A from-scratch reimplementation of the *semantics* of
craigmalenga/universal_pdf_extractor (layout-aware tokenization,
block/row segmentation, whitespace-gap table detection, document
classification, field parsing, sequential balance/direction solving)
re-expressed as vectorized DataFrame + pandas/Arrow UDF stages over a
table of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Layout:
  kernels/   pure Python/numpy/pandas parity kernels (no Spark import)
  stages/    Spark DataFrame stages composing the kernels
  io/        fixture generator, lineage manifest, sinks
  datapipe/  large-scale training-data ops (dedup, ANN, text stats)
"""

__version__ = "0.1.0"
