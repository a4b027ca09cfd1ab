"""``python -m dentist_tpu`` → the CLI."""

import sys

from .cli import main

sys.exit(main())
