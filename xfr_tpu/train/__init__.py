from xfr_tpu.train.finetune import make_train_step  # noqa: F401
