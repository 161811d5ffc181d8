#!/usr/bin/env python
"""spark-submit launcher (north_rule: spark-submit --py-files on a cluster).

    zip -r kg.zip rdf_i2b2_converter_spark
    spark-submit --master <...> --py-files kg.zip submit.py \
        pipeline --pages ... --gazetteer ... --out ...

A top-level script (not inside the package) because spark-submit executes
its primary file as __main__ with no package context; the package itself
arrives via --py-files.
"""

import sys

from rdf_i2b2_converter_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
