"""Model zoo: SIGE-wired generative models (DDPM, PD, GauGAN, SD)."""
