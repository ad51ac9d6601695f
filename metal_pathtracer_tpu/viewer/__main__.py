from metal_pathtracer_tpu.viewer.server import main

raise SystemExit(main())
