"""Driver benchmark entry — prints ONE JSON line. Logic lives in the
packaged module (unet_convlstm_tpu/benchmark.py) so the ``bench`` CLI
subcommand works from an installed wheel too."""

from unet_convlstm_tpu.benchmark import main

if __name__ == "__main__":
    main()
