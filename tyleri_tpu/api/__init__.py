"""tyleri_tpu.api subpackage."""
