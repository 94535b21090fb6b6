"""Host-side utilities: camera/model transforms, asset loaders, image IO."""
