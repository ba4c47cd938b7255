from tdnet_tpu.stream.runtime import LatencyMeter, Streamer, hard_sync
from tdnet_tpu.stream.export import ExportedStreamer, export_streaming_model
