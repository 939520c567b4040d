"""Data layer: camera rays, dataset loaders, synthetic scenes."""
