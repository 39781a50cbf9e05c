"""`python -m concept_tpu` → the CLI (reference `concept` launcher role)."""

import sys

from concept_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
