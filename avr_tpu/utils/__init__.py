from avr_tpu.utils import geometry  # noqa: F401
from avr_tpu.utils.geometry import (  # noqa: F401
    homogenize_points,
    homogenize_vecs,
    unproject,
    transform_rigid,
    transform_world2cam,
    transform_cam2world,
    get_normalized_cam_ray_directions,
    get_world_rays,
    get_opencv_pixel_coordinates,
    depth_from_world,
    look_at_rotation,
    orbit_cam2world,
)
