from newsrecommendation_tpu.ops.attention import (  # noqa: F401
    attention_pooling,
    init_attention_pooling,
    init_multi_head_self_attention,
    masked_exp_normalize,
    mhsa_dropout_pool,
    multi_head_self_attention,
    scaled_dot_product_attention,
)
from newsrecommendation_tpu.ops.conv import conv1d_same, init_conv1d  # noqa: F401
from newsrecommendation_tpu.ops.common import dropout, linear  # noqa: F401
from newsrecommendation_tpu.ops.scoring import score_candidates  # noqa: F401
