from .sdvae import (SDVAEConfig, SpiralGeometry, init_sdvae, encode, decode,
                    forward, reparameterize, latent_regions)
from .mlp import init_mlp, mlp_apply
