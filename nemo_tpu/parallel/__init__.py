from nemo_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    default_axis_rules,
    make_mesh,
    shard_batch,
)
