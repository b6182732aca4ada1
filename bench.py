"""Driver benchmark entry — prints ONE JSON line. Logic lives in the
packaged module (unet_convlstm_tpu/benchmark.py) so the ``bench`` CLI
subcommand works from an installed wheel too.

The module supervises the actual measurement in a child process with
bounded retries (the axon TPU tunnel's failure mode is a hang inside
backend init, unrecoverable in-process) and emits a diagnostic JSON line
instead of a traceback on final failure.
"""

import sys

from unet_convlstm_tpu.benchmark import main

if __name__ == "__main__":
    sys.exit(main())
