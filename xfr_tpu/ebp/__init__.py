from xfr_tpu.ebp.engine import Whitebox, WhiteboxNetwork  # noqa: F401
