from newsrecommendation_tpu.ops.pallas.fused_attention import (  # noqa: F401
    exp_mhsa,
    exp_mhsa_masked,
    exp_mhsa_qkv,
    exp_mhsa_qkv_bias,
    exp_mhsa_qkv_bias_masked,
    exp_mhsa_qkv_masked,
)
from newsrecommendation_tpu.ops.pallas.experimental_fused_encoder import (  # noqa: F401
    exp_mhsa_pool,
    exp_mhsa_pool_masked,
)
from newsrecommendation_tpu.ops.pallas.config import (  # noqa: F401
    fused_tail_enabled,
    pallas_enabled,
    set_fused_tail,
    set_pallas_mode,
)
