"""Service layer: export formats, CLI, REST server, interactive state queue."""
