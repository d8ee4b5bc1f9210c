"""``python -m ot_vae_tpu.config -c <yaml> [-c <yaml> ...]`` — CLI training
entry point (reference: ``python model/vae.py --config ...``, run.sh:3)."""
from ot_vae_tpu.config.cli import main

if __name__ == "__main__":
    main()
