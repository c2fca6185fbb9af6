"""Sources: synthetic corpus generator + driver-testdata loaders."""
