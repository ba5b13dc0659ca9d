"""Plan inspection / access-path reporting."""
