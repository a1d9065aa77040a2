"""Cell / tile indexing layer.

- ``cells``: equirectangular lon/lat grid cells — the engine's workhorse
  join key (pure Column math, constant-foldable, exact polygon covering).
- ``tiles``: slippy-map XYZ tiles + quadkeys (Web Mercator).
- ``s2``: pure-numpy S2 cell ids (Hilbert curve on cube faces).
"""

from gis_scripts_spark.index import cells, s2, tiles  # noqa: F401
