from dalle2_video_tpu.models.unet3d import UNet3D, UNet3DConfig

__all__ = ["UNet3D", "UNet3DConfig"]
