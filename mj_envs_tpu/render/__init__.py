from .raster import Camera, free_camera, fixed_camera, render, resize_half, images_to_observation  # noqa
