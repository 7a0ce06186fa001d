from ransac_tpu.utils import config, logging, prng  # noqa: F401
