import sys

from njw_tpu.dashboard.server import main

if __name__ == "__main__":
    sys.exit(main())
