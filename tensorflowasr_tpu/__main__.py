"""``python -m tensorflowasr_tpu`` → the CLI (same as the console script)."""

import sys

from tensorflowasr_tpu.scripts import main

if __name__ == "__main__":
    sys.exit(main())
