"""Vector geometry layer: WKB codec + planar predicates, pure numpy.

Replaces the reference's OGR/shapely geometry boundary
(``seagrass_lib.py:185-192`` polygon intersection/area,
``clip_raster.py:19-26`` extent reads) with dependency-free kernels that run
inside Arrow-batched pandas UDFs.
"""

from gis_scripts_spark.geom import core, wkb  # noqa: F401
