"""Minimal progress.bar.Bar stand-in: counts silently."""


class Bar:
    def __init__(self, message="", max=0, **kwargs):
        self.message = message
        self.max = max
        self.index = 0

    def next(self):
        self.index += 1

    def finish(self):
        pass

    def writeln(self, text):
        pass


class ChargingBar(Bar):
    pass


class IncrementalBar(Bar):
    pass
