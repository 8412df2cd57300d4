"""``python -m hortacloud_importer_spark`` — the CLI front door."""

import sys

from hortacloud_importer_spark.cli import main

sys.exit(main())
