from .mesh import (  # noqa: F401
    make_ray_mesh,
    replicate_scene,
    shard_rays,
    render_image_sharded,
    render_loss,
    train_step,
)
