from metal_pathtracer_tpu.viewer.server import ViewerServer, main
