"""tyleri_tpu.pipeline subpackage."""
