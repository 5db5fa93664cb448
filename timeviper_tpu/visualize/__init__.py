from timeviper_tpu.visualize.ssm_attention import (  # noqa: F401
    collect_ssm_attention,
    ssd_attention_matrix,
)
