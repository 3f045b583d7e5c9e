"""``python -m etl_from_s3_to_postgresql_template_spark`` — see cli.py."""

import sys

from etl_from_s3_to_postgresql_template_spark.cli import main

sys.exit(main())
