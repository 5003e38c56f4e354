"""Sample reference-style plugin: drops debug-category events
(onMessage returning None signals the drop, reference
utils/plugins.py:95-99)."""


class message:
    def __init__(self):
        self.registration = ["*"]
        self.priority = 50

    def onMessage(self, message, metadata):
        if message.get("category") == "debug":
            return (None, metadata)
        return (message, metadata)
