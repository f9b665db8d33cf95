from .catalog import REGISTRY, QuerySpec, query

# Importing the plan modules populates REGISTRY.
from . import tpch  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import media  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import text_ext  # noqa: E402,F401
from . import grid_common  # noqa: E402,F401
from . import grid_geom_q  # noqa: E402,F401
from . import grid_codec_q  # noqa: E402,F401
from . import grid_product_q  # noqa: E402,F401
from . import grid_spectral_q  # noqa: E402,F401
from . import grid_packing_q  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import llm_ext  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import graph_q  # noqa: E402,F401
from . import recursive_q  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
