from xfr_tpu.utils.cache import cache_npz, cache_npz_launch  # noqa: F401
from xfr_tpu.utils.params import (  # noqa: F401
    iterate_param_sets, prune_unneeded_exports)
