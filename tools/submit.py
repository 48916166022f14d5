"""spark-submit driver script: delegates to codeindex_spark.cli.

    spark-submit --master <...> --py-files codeindex_spark.zip \
        tools/submit.py build --input <parquet> --index <dir> --groups 256
"""

import sys

from codeindex_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
