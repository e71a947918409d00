"""`python -m cornetto_tpu` == `python -m cornetto_tpu.cli`."""

import sys

from cornetto_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
