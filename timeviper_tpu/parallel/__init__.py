from timeviper_tpu.parallel.pipeline import (  # noqa: F401
    PipelineRunner,
    VLMPipelineRunner,
)
from timeviper_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_mesh,
    params_shardings,
    shard_params,
    vlm_sharding_rules,
)
