"""``python -m tpuslam`` — the reference's executable entry
(``cpumain.cpp:37`` / ``gpumain.cpp:50``; one binary here, one backend)."""

import sys

from tpuslam.harness.cli import main

if __name__ == "__main__":
    sys.exit(main())
