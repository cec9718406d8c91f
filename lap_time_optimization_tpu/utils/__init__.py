"""Host-side utilities: IO, corner detection, config, logging, profiling."""
