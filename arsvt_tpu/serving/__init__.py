from arsvt_tpu.serving.server import InferenceServer
