"""Named query plans backing ``__spark_entry__.queries()``."""
