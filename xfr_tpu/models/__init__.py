from xfr_tpu.models.factory import create_net, create_wbnet  # noqa: F401
