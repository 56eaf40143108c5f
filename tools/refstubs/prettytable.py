class PrettyTable:
    def __init__(self, field_names=None):
        self.field_names = list(field_names or [])
        self.rows = []
        self.align = 'l'
    def add_row(self, row):
        self.rows.append([str(x) for x in row])
    def get_string(self, border=True):
        widths = [len(str(f)) for f in self.field_names]
        for row in self.rows:
            for i, v in enumerate(row):
                widths[i] = max(widths[i], len(v))
        def fmt(row):
            return "".join(" " + str(v).ljust(w) + " " for v, w in zip(row, widths))
        return "\n".join([fmt(self.field_names)] + [fmt(r) for r in self.rows])
