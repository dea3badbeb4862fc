"""``python -m image_to_pointcloud_tpu`` → the framework CLI."""

from image_to_pointcloud_tpu.cli import main

raise SystemExit(main())
