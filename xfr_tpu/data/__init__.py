from xfr_tpu.data.triplet import TripletDataLoader  # noqa: F401
