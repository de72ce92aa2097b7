"""Analytics query catalog: the driver-checked operator surface."""
