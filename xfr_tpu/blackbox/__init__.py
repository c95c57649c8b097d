from xfr_tpu.blackbox.strise import STRise  # noqa: F401
