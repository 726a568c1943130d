"""Sources: synthetic image+caption corpus generator and table readers."""
