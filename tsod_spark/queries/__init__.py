"""Per-family query registration modules.

Import ORDER here IS the registration order, which the rotation logic
in ``tsod_spark.registry`` relies on (stable sort within staleness
tiers) — append new families at the end, never reorder.
"""

from . import detectors  # noqa: F401
from . import tpch  # noqa: F401
from . import temporal  # noqa: F401
from . import text  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import multimodal  # noqa: F401
from . import entry  # noqa: F401
from . import tpch_more  # noqa: F401
from . import olap  # noqa: F401
from . import functions  # noqa: F401
from . import round5  # noqa: F401
from . import round7  # noqa: F401
from . import round8  # noqa: F401
from . import round9  # noqa: F401
from . import round10  # noqa: F401
from . import round11  # noqa: F401
from . import round12  # noqa: F401
from . import round13  # noqa: F401
from . import round14  # noqa: F401
from ._base import ORACLE, QUERIES  # noqa: F401
