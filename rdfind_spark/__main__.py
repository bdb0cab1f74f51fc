"""``python -m rdfind_spark`` — see :mod:`rdfind_spark.cli`."""

import sys

from rdfind_spark.cli import main

sys.exit(main())
