"""Config/CLI (reference: VisionCLI + yaml configs)."""
from ot_vae_tpu.config.cli import (apply_links, apply_overrides, build,
                                   instantiate, load_configs, main,
                                   parse_overrides)

__all__ = ["load_configs", "instantiate", "apply_links", "build", "main",
           "parse_overrides", "apply_overrides"]
