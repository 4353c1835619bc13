#!/usr/bin/env python
"""spark-submit launcher: a top-level script cannot use the package's
relative imports, so this thin shim resolves ``tika_xapian_spark`` from
--py-files (or the repo checkout) and delegates to the package CLI.

  spark-submit --py-files tika_xapian_spark.zip scripts/submit.py \
      index --pages <pages> --out <index_dir> --buckets 256
"""

import sys

from tika_xapian_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
