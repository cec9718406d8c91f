"""NMPC stack: artifact track, curvilinear bicycle, AL-iLQR solver, runner."""
