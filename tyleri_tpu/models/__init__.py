"""tyleri_tpu.models subpackage."""
