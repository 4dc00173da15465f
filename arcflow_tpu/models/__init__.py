"""Network architectures (flax.linen modules)."""

from .toy import (ToyMLPDenoiser, ToyArcFlowDenoiser, ToyGMFlowDenoiser,
                  SpectrumMLP, timestep_embedding)
from .base import BaseModel, Diffusion2D, Distillation2D
from .flux import (ArcFluxTransformer2DModel, FluxTransformer2DModel,
                   ARCFLUX_ADAPTER_KEYS, patchify, unpatchify)
from .qwen import (ArcQwenImageTransformer2DModel, QwenImageTransformer2DModel,
                   ARCQWEN_ADAPTER_KEYS)
from .vae import PretrainedVAE, PretrainedVAEDecoder, PretrainedVAEEncoder
from .qwen_vae import PretrainedVAEQwenImage
from .text_encoders import (PretrainedFluxTextEncoder,
                            PretrainedQwenImageTextEncoder,
                            PretrainedStableDiffusion3TextEncoder)
from .unet import (DenoisingUnetMod, ArcDenoisingUnetMod,
                   ARCUNET_ADAPTER_KEYS)
from .class_image import LatentDiffusionClassImage
from .latent_diffusion import LatentDiffusionTextImage

__all__ = ['ToyMLPDenoiser', 'ToyArcFlowDenoiser', 'ToyGMFlowDenoiser',
           'SpectrumMLP', 'timestep_embedding',
           'BaseModel', 'Diffusion2D', 'Distillation2D',
           'ArcFluxTransformer2DModel', 'FluxTransformer2DModel',
           'ARCFLUX_ADAPTER_KEYS', 'patchify', 'unpatchify',
           'ArcQwenImageTransformer2DModel', 'QwenImageTransformer2DModel',
           'ARCQWEN_ADAPTER_KEYS', 'LatentDiffusionTextImage',
           'PretrainedVAE', 'PretrainedVAEDecoder', 'PretrainedVAEEncoder',
           'PretrainedVAEQwenImage', 'PretrainedFluxTextEncoder',
           'PretrainedQwenImageTextEncoder',
           'PretrainedStableDiffusion3TextEncoder',
           'DenoisingUnetMod', 'ArcDenoisingUnetMod', 'ARCUNET_ADAPTER_KEYS',
           'LatentDiffusionClassImage']
