"""Storage backends for streamed layouts.

``objectstore`` is the no-rename commit path (conditional-put log
protocol) for object-store deployments; the POSIX symlink/manifest
protocol lives in ``streaming.incremental``.
"""
