"""Import-time stand-in for scenepic (not installed). The reference
package imports it at module scope but the training scripts only touch
it for HTML export, which the head-to-head baseline skips. Any
attribute access returns a permissive dummy."""


class _Anything:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _Anything()

    def __getattr__(self, name):
        return _Anything()


def __getattr__(name):
    return _Anything()
