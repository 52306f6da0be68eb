from newsrecommendation_tpu.ops.pallas.fused_attention import exp_mhsa  # noqa: F401
from newsrecommendation_tpu.ops.pallas.config import (  # noqa: F401
    pallas_enabled,
    set_pallas_mode,
)
