"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline at sf0.001 (smoke).
``queries()`` — one entry per implemented operator (SURVEY.md §2 + graft
training-data ops); each callable takes ``sf_dir``.
``oracle_sql()`` — DuckDB twins for the SQL-expressible subset, over the
driver's registered views plus read_parquet() of the deterministic
fixture files both sides share (see pipelines/fixtures.py).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# make the package importable regardless of the driver's cwd/sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from wrangle_openstreetmap_data_ray.pipelines import flagship as _flagship
from wrangle_openstreetmap_data_ray.pipelines import registry as _registry


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _flagship.flagship("/root/testdata/sf0.001",
                              out_root="/tmp/graft_out/flagship_sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
