"""Config/CLI (reference: VisionCLI + yaml configs)."""
from ot_vae_tpu.config.cli import apply_links, build, instantiate, load_configs, main

__all__ = ["load_configs", "instantiate", "apply_links", "build", "main"]
