import sys

from crdmodel_tpu.cli import main

sys.exit(main())
