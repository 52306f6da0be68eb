from newsrecommendation_tpu.utils.logging import setup_logger, dump_config  # noqa: F401
