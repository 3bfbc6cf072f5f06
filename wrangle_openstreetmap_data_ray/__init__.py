"""wrangle_openstreetmap_data_ray — a Ray-Data-native spatial wrangling engine.

A from-scratch engine with the query/data-processing capabilities of the
reference repo ``YannisPap/Wrangle-OpenStreetMap-Data`` (an OSM
audit-and-normalize pipeline; see SURVEY.md), generalized per
``BASELINE.json:north_rule`` into a spatial-join + tiling pipeline
(quadkey cell index, point-in-polygon, kNN, raster tiles) over Lance-like
tables of image + caption pairs, built on ``ray.data.Dataset`` +
``map_batches`` over zero-copy Arrow batches.

No module in this package calls ``ray.init()`` / ``ray.shutdown()`` —
the session is owned by the driver, ``bench.py``, or the test fixture.

Layout:
- ``functions/`` — pure vectorized kernels (normalize, geo, codecs, text, hashing)
- ``sources/``   — readers/writers (Lance-like fragment+manifest format, OSM XML)
- ``stages/``    — Dataset->Dataset stages incl. stateful actor-pool stages
  (PIP join, kNN join, tiles, dedup, similarity search, multimodal)
- ``pipelines/`` — composed end-to-end pipelines + the analytics query suite
- ``state/``     — broadcast helpers (ray.put small sides)
- ``synth.py``   — deterministic (seed=42) fixture synthesis per FIXTURES.md
"""

__version__ = "0.1.0"
