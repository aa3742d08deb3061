import sys

from njw_tpu.weather.__main__ import main

sys.exit(main())
