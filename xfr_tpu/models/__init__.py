from xfr_tpu.models.factory import create_wbnet  # noqa: F401
