"""Repo-root shim: the job lives in tstore_spark.jobs.rollup_job (installable
package); this path is kept so `spark-submit jobs/rollup_job.py` keeps working."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tstore_spark.jobs.rollup_job import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
