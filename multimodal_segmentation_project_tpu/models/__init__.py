from multimodal_segmentation_project_tpu.models.unet3d import UNet3D, DoubleConv
from multimodal_segmentation_project_tpu.models.discriminator import DomainDiscriminator

__all__ = ["UNet3D", "DoubleConv", "DomainDiscriminator"]
