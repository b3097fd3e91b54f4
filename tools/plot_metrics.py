"""Shim: the plotter lives in the package (vae_npvc_tpu/utils/plot_metrics.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from vae_npvc_tpu.utils.plot_metrics import main

if __name__ == "__main__":
    main()
