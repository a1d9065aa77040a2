"""gis_scripts_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the capabilities of the reference repo ``cankanoa/gis-scripts``
(single-machine GDAL/rasterio utility scripts) as an idiomatic Spark engine:

- cell indexing (grid / quadkey / XYZ / S2) as pure Column math + vectorized
  pandas UDFs (``gis_scripts_spark.index``)
- cell-keyed broadcast and shuffle-hash point-in-polygon joins
  (``operators.pip_join``; reference semantics: zonal join,
  ``Assess_Agreement.R:45-57``)
- deterministic raster<->vector tile assignment (``operators.tile_assign``;
  reference: block grid ``local_match.py:508-542``)
- block-grid aggregation, mean-of-means (``operators.grid_agg``;
  reference: ``local_match.py:263-392``)
- grid-partitioned kNN with cell-ring expansion (``operators.knn``)
- pairwise bbox overlap join (``operators.overlap_join``; reference:
  ``global_match.py:61-198``)
- pixel kernels over image bytes via Arrow-batched pandas UDFs
  (``raster.ops``; reference: per-band numpy kernels)
- snapshot-checkpointed parquet tables with lineage metrics
  (``sources.snaptable``)

Everything here is built from public knowledge only: the PySpark API, the
reference repo's observable semantics, and published algorithms (S2 cell
ids, slippy-map tiles, WKB, MinHash/SimHash).
"""

__version__ = "0.1.0"
