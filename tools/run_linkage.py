"""spark-submit driver script.

    bash tools/make_pyfiles.sh   # builds /tmp/identity_matching_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/identity_matching_spark.zip \
        tools/run_linkage.py --input synthetic:2000 --output /tmp/ims_out
"""

import sys

from identity_matching_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
