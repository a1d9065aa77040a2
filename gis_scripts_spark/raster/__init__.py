"""Raster layer: image codecs, pixel kernels, histogram matching.

All pixel math happens inside Arrow-batched pandas UDFs on the `bytes`
column of the image table (input_hint schema) — the Spark analogue of the
reference's per-file numpy kernels.
"""
