"""`python -m jvector_spark.session_zip` — build the --py-files deployment zip.

Prints the zip path on the last stdout line; the cluster-mode launch is then

    spark-submit --py-files <zip> jvector_spark/cli.py build ...

(the north rule's deployment shape). The zip contains every .py under the
package, written atomically so concurrent builders never hand executors a
truncated file (see session.package_zip).
"""

from __future__ import annotations

from jvector_spark.session import package_zip

if __name__ == "__main__":
    print(package_zip())
