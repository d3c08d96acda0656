"""Root CLI shim: ``python trainer.py -t TAG -c CONFIG [-d DEFAULT]`` —
drop-in for the reference's ``python src/trainer.py`` entry point."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dbw_tpu.train.trainer import main

if __name__ == "__main__":
    main()
