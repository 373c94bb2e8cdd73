from .generator import Generator, SynthesisNetwork
from .discriminator import Discriminator
from .patch_discriminator import PatchCoOccurrenceDiscriminator

__all__ = ["Generator", "SynthesisNetwork", "Discriminator",
           "PatchCoOccurrenceDiscriminator"]
