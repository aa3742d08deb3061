import sys

from njw_tpu.dashboard.server import main

sys.exit(main())
